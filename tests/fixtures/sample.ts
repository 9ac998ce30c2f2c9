# sample sktime-format fixture (hand-written)
@problemName sample
@timeStamps false
@univariate false
@classLabel true up down
@data
1.0,2.0,3.5,2.5:10.0,11.0,9.0,8.0:up
4.0,3.0,2.0,1.0:7.5,6.5,5.5,4.5:down
0.5,1.5,0.5,1.5:2.0,2.0,2.0,2.0:up
